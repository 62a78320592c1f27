package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** SURVEY.md §2.1–§2.4 + §2.6: scans, projection/filter/cast, joins,
  * aggregations, set ops. Most queries are ANSI-common SQL text run on
  * both engines; a few use the DataFrame API with a hand-written
  * DuckDB oracle to exercise the idiomatic Spark surface (broadcast
  * hints, typed joins, dropDuplicates).
  *
  * Scale notes (100 TB): every aggregate here is a partial+final hash
  * aggregate (map-side combine free via Catalyst); joins on big×small
  * use explicit broadcast; big×big joins shuffle on their equi-keys
  * which is the right plan at any scale. Decimal-cast-before-sum keeps
  * results order-independent, so plans stay hash-mismatch-safe under
  * AQE re-planning.
  */
object Relational {
  val set = new QuerySet
  import set._

  // ---- §2.1 scans / sources ------------------------------------------
  // S6: row-generating source. Spark `range` vs DuckDB `range`.
  spark("s6_range",
    (s, _) => s.range(0, 5).toDF("id").orderBy("id"),
    "SELECT range AS id FROM range(0, 5) ORDER BY id")

  // ---- §2.2 projection / filter / expressions / cast ------------------
  // Output discipline: every DECIMAL is final-cast to DOUBLE (exact
  // decimal → double is identically rounded on both engines) and every
  // integer SUM is CAST to BIGINT so DuckDB never surfaces HUGEINT —
  // the driver's canonicalizer float-coerces one side, so a surviving
  // DECIMAL output renders '17.00' vs 17.0 and hash-fails.
  common("p1_project",
    """SELECT l_orderkey, l_linenumber, CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)

  common("p2_filter_cmp",
    """SELECT l_orderkey, l_linenumber FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount >= 0.05 AND l_returnflag <> 'N'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  common("p2_filter_in",
    """SELECT count(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_returnflag IN ('A', 'R') AND l_shipdate >= TIMESTAMP '2000-06-01 00:00:00' OR l_quantity = 1""".stripMargin)

  common("p2_filter_null",
    "SELECT count(*) AS n_zero_tax FROM lineitem WHERE NULLIF(l_tax, 0.0) IS NULL")

  common("p3_expr",
    """SELECT o_orderkey, o_orderkey % 7 AS m7, o_orderkey * 10 AS x10,
      |       -o_orderkey AS neg, o_orderkey + 1 AS inc, (o_orderkey - 1) % 3 AS m3
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  common("p4_cast",
    """SELECT l_orderkey, l_linenumber,
      |       CAST(l_quantity AS INTEGER) AS q_int,
      |       CAST(l_quantity AS SMALLINT) AS q_short,
      |       CAST(l_quantity AS BIGINT) AS q_long,
      |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS p_dec,
      |       CAST(l_linenumber AS DOUBLE) AS ln_d,
      |       CAST(l_orderkey AS VARCHAR(30)) AS key_s,
      |       CAST(l_shipdate AS DATE) AS ship_d
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // ---- §2.3 joins ------------------------------------------------------
  // Range-partition the fact on the output order key and broadcast
  // the dim: the broadcast join preserves the fact's partitioning, so
  // the trailing local sort IS the global ORDER BY — one exchange,
  // and no range-sampling job re-executing the join. The explicit
  // broadcast() pins the plan shape the ordering correctness relies
  // on (dim-table precondition; a fact-fact ORDER BY keeps plain
  // orderBy). Measured at sf1: 1.64 → 0.88 s.
  spark("j1_inner",
    (s, d) => graft.Tables.t(s, d, "orders")
      .repartitionByRange(org.apache.spark.sql.functions.col("o_orderkey"))
      .join(org.apache.spark.sql.functions.broadcast(graft.Tables.t(s, d, "customer")),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .selectExpr("o_orderkey", "o_custkey", "c_name",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price")
      .sortWithinPartitions("o_orderkey"),
    """SELECT o_orderkey, o_custkey, c_name, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""".stripMargin)

  // Aggregate below the outer join: counting orders per customer
  // needs only orders' own groupBy (map-side combine shrinks the fact
  // before any join), after which the left join handles 100k pre-
  // counted rows instead of 1.5M raw ones and the count(o_orderkey)=0
  // case becomes coalesce. Measured at sf1: 1.51 → 0.71 s.
  spark("j2_left",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, c_name, coalesce(n, CAST(0 AS BIGINT)) AS n_orders
              |FROM customer LEFT JOIN
              |  (SELECT o_custkey, count(o_orderkey) AS n FROM orders GROUP BY o_custkey) o
              |  ON c_custkey = o_custkey
              |ORDER BY c_custkey""".stripMargin) },
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin)

  // Pre-count orders per custkey BELOW the full join (the j2_left
  // lever, outer-join-safe): the join then pairs 99k customers with
  // 100k count rows instead of 1.5M order rows, and the group-by
  // disappears. Exact per-group equivalence: a matched key's group
  // held n order rows with c_name repeated n times, so n_o = n and
  // n_c = n; an orderless customer's single all-null-right row gives
  // (0, 1); a customerless key keeps (n, 0) - greatest/coalesce
  // reproduce all three. Relies on c_custkey being unique (customer's
  // PK, arange in gen_sf.py): a duplicated key would emit one row per
  // duplicate here but a single merged row in the oracle's GROUP BY.
  // 0.77 -> 0.57 s at sf1.
  spark("j2_full",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""WITH oc AS (SELECT o_custkey, CAST(count(o_orderkey) AS BIGINT) AS n
              |           FROM orders GROUP BY o_custkey)
              |SELECT coalesce(c_custkey, o_custkey) AS k,
              |       coalesce(n, CAST(0 AS BIGINT)) AS n_o,
              |       CASE WHEN c_custkey IS NULL THEN CAST(0 AS BIGINT)
              |            ELSE greatest(coalesce(n, CAST(0 AS BIGINT)), CAST(1 AS BIGINT)) END AS n_c
              |FROM customer FULL JOIN oc ON c_custkey = o_custkey
              |ORDER BY k""".stripMargin) },
    """SELECT coalesce(c_custkey, o_custkey) AS k, count(o_orderkey) AS n_o, count(c_name) AS n_c
      |FROM customer FULL JOIN orders ON c_custkey = o_custkey
      |GROUP BY coalesce(c_custkey, o_custkey) ORDER BY k""".stripMargin)

  // J3/J4: DataFrame-API semi/anti joins; oracle uses EXISTS/NOT EXISTS.
  spark("j3_semi",
    (s, d) => {
      // distinct the probe side first, as in j4_anti: a semi join
      // needs only key presence (0.76 → 0.50 s at sf1)
      val c = Tables.t(s, d, "customer")
      val o = Tables.t(s, d, "orders").select(col("o_custkey")).distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
    },
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin)

  spark("j4_anti",
    (s, d) => {
      // distinct the probe side first: anti join needs only key
      // presence, so map-side combine shrinks the fact before the
      // shuffle (0.66 → 0.45 s at sf1)
      val c = Tables.t(s, d, "customer")
      val o = Tables.t(s, d, "orders").select(col("o_custkey")).distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
    },
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin)

  common("j5_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""")

  // Theta self-join → exact pair-count algebra (r11, the r10 "best
  // remaining plan-work candidate"): for an AGGREGATED strict-< theta
  // self-join, the pair count per group is a closed form over value
  // multiplicities — pairs(okey) = C(k,2) − Σ_v C(m_v,2), where k =
  // rows in the group and m_v = multiplicity of each l_linenumber
  // value (the correction term is 0 when values are distinct, but the
  // identity is EXACT regardless — no data assumption). Two narrow
  // long-only aggregations replace the SMJ's O(pairs) probe work: at
  // 100 TB the fact shuffles 16-byte rows once and never materializes
  // a pair. The oracle stays the literal join, proving the identity.
  spark("j6_theta",
    (s, d) => {
      val li = Tables.t(s, d, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("m"))
        .groupBy("l_orderkey")
        .agg(sum(col("m")).as("k"),
             sum(expr("m * (m - 1L) div 2L")).as("dup"))
        .select(col("l_orderkey").as("okey"),
          (expr("k * (k - 1L) div 2L") - col("dup")).as("n"))
        .where(col("n") > 0L)
        // range partitions are key-ranged → concatenation is globally
        // ordered; avoids orderBy's extra sampling pass (J6Probe A/B)
        .repartitionByRange(6, col("okey"))
        .sortWithinPartitions("okey")
    },
    """SELECT l1.l_orderkey AS okey, CAST(count(*) AS BIGINT) AS n
      |FROM lineitem l1 JOIN lineitem l2
      |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
      |GROUP BY l1.l_orderkey ORDER BY okey""".stripMargin)

  common("j6_nonequi",
    """SELECT r_regionkey, n_nationkey FROM region JOIN nation ON n_regionkey <> r_regionkey
      |ORDER BY r_regionkey, n_nationkey""".stripMargin)

  // J7 as-of join via the union-tag sort-merge operator: ONE shuffle +
  // ONE sort on (key, time), no left×earlier-right candidate fan-out —
  // the composed left-join + max() shape materializes O(|L|·matches)
  // intermediate rows, which explodes on long right histories at scale.
  // Oracle uses DuckDB ASOF.
  spark("j7_asof",
    (s, d) => {
      val e = Tables.t(s, d, "events").select("event_id", "user_id", "ts")
      val o = Tables.t(s, d, "orders").select("o_custkey", "o_orderdate")
      graft.operators.AsOfJoin.backward(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = "o_orderdate", payload = Seq("o_orderdate"))
        .select(col("event_id"), col("o_orderdate").as("asof_date"))
        // eager materialization before the ordered dump: orderBy's
        // range sampler would otherwise RE-EXECUTE the whole as-of
        // (J7Probe sf1 A/B: 1.81 -> 1.49 s)
        .localCheckpoint(true)
        .orderBy("event_id")
    },
    """SELECT e.event_id AS event_id, o.o_orderdate AS asof_date
      |FROM events e ASOF LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY event_id""".stripMargin)

  // J7b: as-of join with right-side payload via the reusable operator
  // (deterministic tiebreak on o_orderkey, which DuckDB ASOF lacks —
  // oracle uses the equivalent window formulation).
  spark("j7_asof_payload",
    (s, d) => {
      val e = Tables.t(s, d, "events").select("event_id", "user_id", "ts")
      val o = Tables.t(s, d, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
      graft.operators.AsOfJoin.backward(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          tieBreak = "o_orderkey", payload = Seq("o_orderkey", "o_orderdate"))
        .select(col("event_id"), col("o_orderkey").as("okey"), col("o_orderdate").as("odate"))
        .localCheckpoint(true) // see j7_asof: skip the sampler re-execution
        .orderBy("event_id")
    },
    """SELECT event_id, okey, odate FROM (
      |  SELECT e.event_id, o.o_orderkey AS okey, o.o_orderdate AS odate,
      |    row_number() OVER (PARTITION BY e.event_id
      |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
      |) t WHERE rn = 1 ORDER BY event_id""".stripMargin)

  // J8 star join: DataFrame API with an explicit broadcast of the dim
  // table — the 100 TB plan (fact shuffles once; dims broadcast).
  spark("j8_star",
    (s, d) => {
      val li = Tables.t(s, d, "lineitem"); val o = Tables.t(s, d, "orders")
      val c = Tables.t(s, d, "customer"); val n = Tables.t(s, d, "nation")
      // cents kernel: the join carries two longs instead of decimals;
      // the only decimal op is one exact division per nation
      // pre-aggregate the fact on the join key BEFORE the star walk:
      // the groupBy shuffles on l_orderkey — the exact partitioning
      // the orders join needs anyway — so the same shuffle count now
      // probes with one row per order instead of ~4 line items. At
      // 100 TB that is a 4× cut of every downstream join input.
      val fact = li.select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4"))
        .groupBy("l_orderkey")
        .agg(sum(col("rev4")).as("rev4"), count(lit(1)).as("cnt"))
      fact.join(o, fact("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name").as("n_name"))
        .agg(
          (sum(col("rev4")).cast(DecimalType(24, 0)) / 10000)
            .cast(DecimalType(30, 6)).cast("double").as("revenue"),
          sum(col("cnt")).as("n_items"))
        .orderBy("n_name")
    },
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin)

  // ---- §2.4 aggregations ----------------------------------------------
  // Spark side runs the a2-style cents kernel: the SUM accumulates in
  // LONG codegen and MIN/MAX compare longs; only the three final
  // values touch decimal (one exact /100 each), so the surfaced
  // doubles are bit-identical to the oracle's decimal-cast path.
  spark("a1_agg_global",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT count(*) AS n, count(l_orderkey) AS n_key,
              |  CAST(CAST(CAST(SUM(qc) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS sum_qty,
              |  CAST(CAST(CAST(MIN(pc) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS min_price,
              |  CAST(CAST(CAST(MAX(pc) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS max_price
              |FROM (SELECT l_orderkey,
              |        CAST(round(l_quantity * 100) AS BIGINT) AS qc,
              |        CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
              |      FROM lineitem) c""".stripMargin) },
    """SELECT count(*) AS n, count(l_orderkey) AS n_key,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
      |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
      |FROM lineitem""".stripMargin)

  // A2: TPC-H Q1 skeleton. Inner cast keeps every product exact; the
  // (18,4) re-cast before the tax multiply keeps DuckDB's decimal width
  // under 38 while Spark follows the identical lossless path.
  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  // Q1 runs the cents kernel on the Spark side: 2-decimal doubles are
  // exact integer cents, so every per-row product/sum stays in LONG
  // codegen (no Decimal allocation on the hot path) and only the six
  // group results touch decimal — one exact decimal division each, so
  // the surfaced doubles are bit-identical to the oracle's
  // decimal-sum-then-cast. Exact while the scaled sums fit a long
  // (charge in 1e-6 units: ~6e16 at sf0.1, bound ~9.2e18) — beyond
  // that, shard the sum or use the decimal formulation (the oracle's).
  spark("a2_q1_agg",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  CAST(CAST(CAST(SUM(qc) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS sum_qty,
              |  CAST(CAST(CAST(SUM(pc) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS sum_base_price,
              |  CAST(CAST(CAST(SUM(pc * (100 - dc)) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS sum_disc_price,
              |  CAST(CAST(CAST(SUM(pc * (100 - dc) * (100 + tc)) AS DECIMAL(24,0)) / 1000000 AS DECIMAL(30,6)) AS DOUBLE) AS sum_charge,
              |  count(*) AS count_order
              |FROM (SELECT l_returnflag, l_linestatus,
              |        CAST(round(l_quantity * 100) AS BIGINT) AS qc,
              |        CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
              |        CAST(round(l_discount * 100) AS BIGINT) AS dc,
              |        CAST(round(l_tax * 100) AS BIGINT) AS tc
              |      FROM lineitem
              |      WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00') c
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin) },
    q1Sql)

  common("a3_minmax",
    """SELECT p_brand,
      |  CAST(MIN(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
      |  CAST(MAX(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
      |  count(*) AS n
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin)

  // avg/stddev/var from exact decimal sums, final arithmetic in double:
  // both engines divide the same two exact values → bit-identical.
  common("a3_avg_var",
    """SELECT p_brand,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  (CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
      |   - CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |  / (count(*) - 1) AS var_price
      |FROM part GROUP BY p_brand HAVING count(*) > 1 ORDER BY p_brand""".stripMargin)

  common("a4_distinct",
    """SELECT c_nationkey, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)

  // Spark side pre-distincts the cents value: the distinct runs as a
  // map-side partial hash-agg on a LONG key (a few thousand survivors
  // shuffle), and the SUM/COUNT see only the distinct set — no
  // distinct-aggregate planning over decimals. distinct-of-cents =
  // cents-of-distinct because round(x*100) is injective on the
  // 2-decimal corpus (asserted per SF, see a7).
  spark("a4_sum_distinct",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT CAST(CAST(CAST(SUM(qc) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS sd,
              |       count(qc) AS nd
              |FROM (SELECT DISTINCT CAST(round(l_quantity * 100) AS BIGINT) AS qc
              |      FROM lineitem) c""".stripMargin) },
    """SELECT CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sd,
      |       count(DISTINCT l_quantity) AS nd
      |FROM lineitem""".stripMargin)

  // A5: approx_count_distinct — implementation-defined sketch, so no
  // hash oracle; driver does the rows-only check.
  sparkOnly("a5_approx_distinct",
    (s, d) => Tables.t(s, d, "lineitem")
      .agg(approx_count_distinct("l_partkey").as("approx_parts"),
           count_distinct(col("l_partkey")).as("exact_parts")))

  // Spark side runs the cents kernel (see a2_q1_agg) AND pre-aggregates
  // by the two rollup columns first: count/sum re-aggregate
  // associatively, so the Expand-by-3 operator runs over the 6
  // pre-aggregated groups instead of every lineitem row (the expand
  // was tripling the 6M-row stream at sf1).
  spark("a6_rollup",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""WITH g AS (SELECT l_returnflag, l_linestatus, count(*) AS n0,
              |                  SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS s0
              |           FROM lineitem GROUP BY l_returnflag, l_linestatus)
              |SELECT coalesce(l_returnflag, '<ALL>') AS rf, coalesce(l_linestatus, '<ALL>') AS ls,
              |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g1, CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
              |  SUM(n0) AS n,
              |  CAST(CAST(CAST(SUM(s0) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS sum_qty
              |FROM g
              |GROUP BY ROLLUP(l_returnflag, l_linestatus)
              |ORDER BY g1, g2, rf, ls""".stripMargin) },
    """SELECT coalesce(l_returnflag, '<ALL>') AS rf, coalesce(l_linestatus, '<ALL>') AS ls,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g1, CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
      |  count(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g1, g2, rf, ls""".stripMargin)

  common("a6_cube",
    """SELECT coalesce(o_orderstatus, '<ALL>') AS st, coalesce(o_orderpriority, '<ALL>') AS pri,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g1, CAST(GROUPING(o_orderpriority) AS BIGINT) AS g2,
      |  count(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY g1, g2, st, pri""".stripMargin)

  // Spark side on the cents kernel: the conditional decimal SUM stays
  // in whole-stage codegen as a long (CASE with no ELSE sums to NULL
  // over an empty match set, exactly like FILTER). 0.57 → 0.31 s at
  // sf1; round(x*100) exactness vs the DECIMAL(18,2) cast is asserted
  // over every SF.
  spark("a7_filter_agg",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT o_orderpriority, count(*) AS n_all,
              |  count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
              |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DECIMAL(20,0)) / 100 AS DOUBLE) AS sum_f
              |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) },
    """SELECT o_orderpriority, count(*) AS n_all,
      |  count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  common("a8_having",
    """SELECT l_orderkey, count(*) AS n FROM lineitem
      |GROUP BY l_orderkey HAVING count(*) >= 5 ORDER BY l_orderkey""".stripMargin)

  // ---- TPC-H-shaped multi-join analytics (Q3/Q5/Q10 skeletons) --------
  // Spark sides of the TPC-H revenue queries run the cents kernel
  // (see a2_q1_agg); oracles keep the decimal formulation.
  // Pre-aggregate the fact per order BEFORE the joins (the j8_star /
  // q13 lever): the groupBy shuffles on l_orderkey - the key the
  // orders join needs anyway - so the joins probe one row per order
  // (~4x less input) and the final GROUP BY disappears entirely
  // (orderkey is unique in both lrev and orders): 0.97 -> 0.77 s at
  // sf1. Semantics unchanged: grouping by (l_orderkey, o_orderdate)
  // was already one group per orderkey.
  spark("tpch_q3_shipping",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""WITH lrev AS (
              |  SELECT l_orderkey,
              |         SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
              |  FROM lineitem WHERE l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
              |  GROUP BY l_orderkey)
              |SELECT l_orderkey,
              |  CAST(CAST(CAST(rev4 AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
              |  CAST(o_orderdate AS DATE) AS odate
              |FROM customer JOIN orders ON c_custkey = o_custkey
              |  JOIN lrev ON l_orderkey = o_orderkey
              |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
              |ORDER BY revenue DESC NULLS LAST, l_orderkey LIMIT 20""".stripMargin) },
    """SELECT l_orderkey,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS DATE) AS odate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC NULLS LAST, l_orderkey LIMIT 20""".stripMargin)

  // cents kernel on the Spark side (oracle keeps the decimal
  // formulation): long revenue units through the 6-way join, one exact
  // decimal division per nation at the end.
  // Plan shape: the FACT table leads so it is the streamed side of
  // every join (the dim-first ordering made Catalyst broadcast the
  // pruned 600k-row lineitem projection — a driver-built hash relation
  // on the hot path); orders and the dims broadcast at this SF and
  // AQE switches them to shuffle joins when they outgrow the
  // threshold. The c_nationkey = s_nationkey residual lands as a
  // second equi-key of the supplier broadcast join.
  spark("tpch_q5_local_supplier",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT n_name,
              |  CAST(CAST(CAST(SUM(rev4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue
              |FROM (SELECT l_orderkey, l_suppkey,
              |        CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
              |      FROM lineitem) l
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON c_custkey = o_custkey
              |  JOIN nation ON c_nationkey = n_nationkey
              |  JOIN region ON n_regionkey = r_regionkey
              |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |WHERE r_name = 'AMERICA'
              |GROUP BY n_name ORDER BY revenue DESC NULLS LAST, n_name""".stripMargin) },
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'AMERICA'
      |GROUP BY n_name ORDER BY revenue DESC NULLS LAST, n_name""".stripMargin)

  // Plan shape: revenue aggregates on o_custkey BEFORE any dim join —
  // the group key is a long, not (custkey, name, n_name) wide rows, and
  // c_name/n_name/c_acctbal are functionally determined by c_custkey so
  // re-attaching them post-agg is exactly the textbook result. One fact
  // shuffle (lineitem ⋈ orders on the order key), dims broadcast.
  spark("tpch_q10_returns",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""WITH rev AS (
              |  SELECT o_custkey, SUM(rev4) AS rev4s
              |  FROM (SELECT l_orderkey,
              |          CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
              |        FROM lineitem WHERE l_returnflag = 'R') l
              |    JOIN orders ON l_orderkey = o_orderkey
              |  GROUP BY o_custkey)
              |SELECT c_custkey, c_name,
              |  CAST(CAST(CAST(rev4s AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
              |  CAST(CAST(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS acctbal,
              |  n_name
              |FROM rev JOIN customer ON c_custkey = o_custkey
              |  JOIN nation ON c_nationkey = n_nationkey
              |ORDER BY revenue DESC NULLS LAST, c_custkey LIMIT 20""".stripMargin) },
    """SELECT c_custkey, c_name,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
      |  CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal,
      |  n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC NULLS LAST, c_custkey LIMIT 20""".stripMargin)

  // Q6 skeleton: selective filter + single exact-decimal aggregate —
  // the canonical predicate-pushdown-then-scan query.
  common("tpch_q6_forecast",
    """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin)

  // Q4 skeleton: EXISTS-correlated subquery (adapted: ship-after-order
  // stands in for commit<receipt, which the synthetic schema lacks).
  // Spark side: the date filter shrinks orders to a broadcastable
  // slice, so EXISTS becomes broadcast-join → residual date predicate
  // → DISTINCT on the (unique) order key — the fact is reduced by the
  // broadcast BEFORE any shuffle, and the distinct partial-aggregates.
  spark("tpch_q4_priority",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT o_orderpriority, count(*) AS n
              |FROM (SELECT DISTINCT o_orderkey, o_orderpriority
              |      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              |      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              |        AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
              |        AND l_shipdate > o_orderdate) x
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) },
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  // Q14 skeleton: conditional revenue ratio over a fact-dim join.
  // Spark side on the cents kernel; both sums surface through the same
  // exact decimal→double path before the (identical) double ops.
  spark("tpch_q14_promo",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT CAST(100 AS DOUBLE) *
              |  CAST(CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN rev4 ELSE 0 END) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE)
              |  / CAST(CAST(CAST(SUM(rev4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS promo_revenue
              |FROM (SELECT l_partkey,
              |        CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
              |      FROM lineitem
              |      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00') l
              |  JOIN part ON l_partkey = p_partkey""".stripMargin) },
    """SELECT CAST(100 AS DOUBLE) *
      |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin)

  // Q18 skeleton: group-having over the 3-way join (large-volume
  // orders). Spark plan aggregates the FACT table first (one shuffle
  // on l_orderkey, HAVING shrinks 150k orders to a handful) and joins
  // the dims after — Catalyst does not push aggregates below joins, so
  // the naive join-then-group shape would shuffle the full join output.
  // Keys are functionally determined by o_orderkey, so results are
  // identical to the oracle's textbook formulation.
  // Q18 over the hash-bucketed vortex layout: lineitem bucketed by
  // l_orderkey reports KeyGroupedPartitioning, so the big CTE's
  // GROUP BY l_orderkey aggregates storage-partitioned — ZERO exchange
  // on the 600k-row fact scan (vs. tpch_q18_large's full shuffle).
  // The bucketed copy materializes once per JVM temp dir (the ingest-
  // time cost a real deployment amortizes); reps after the first
  // measure the exchange-free read path. Oracle: the same q18 SQL over
  // the original parquet — the layout must not change a single row.
  spark("tpch_q18_bucketed",
    (s, d) => { Tables.registerAll(s, d)
      val cat = graft.sources.vortex.BucketedTables.catalog(s)
      val li = graft.sources.vortex.BucketedTables.dir(s, d, "lineitem", "l_orderkey")
      s.sql(s"""WITH big AS (
              |  SELECT l_orderkey,
              |    CAST(CAST(CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS sum_qty
              |  FROM $cat.`$li` GROUP BY l_orderkey
              |  HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 20000)
              |SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
              |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price, sum_qty
              |FROM big JOIN orders ON o_orderkey = big.l_orderkey
              |  JOIN customer ON c_custkey = o_custkey
              |ORDER BY price DESC NULLS LAST, o_orderkey LIMIT 20""".stripMargin) },
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
      |ORDER BY price DESC NULLS LAST, o_orderkey LIMIT 20""".stripMargin)

  spark("tpch_q18_large",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""WITH big AS (
              |  SELECT l_orderkey,
              |    CAST(CAST(CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DECIMAL(24,0)) / 100 AS DECIMAL(30,6)) AS DOUBLE) AS sum_qty
              |  FROM lineitem GROUP BY l_orderkey
              |  HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 20000)
              |SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
              |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price, sum_qty
              |FROM big JOIN orders ON o_orderkey = big.l_orderkey
              |  JOIN customer ON c_custkey = o_custkey
              |ORDER BY price DESC NULLS LAST, o_orderkey LIMIT 20""".stripMargin) },
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
      |ORDER BY price DESC NULLS LAST, o_orderkey LIMIT 20""".stripMargin)

  // ---- §2.6 sorts / limits / set ops ----------------------------------
  common("o1_sort_multikey",
    """SELECT l_orderkey, l_linenumber, CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty
      |FROM lineitem
      |ORDER BY qty DESC NULLS LAST, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin)

  common("o2_limit_offset",
    """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price FROM orders
      |ORDER BY price DESC NULLS LAST, o_orderkey NULLS FIRST LIMIT 10 OFFSET 5""".stripMargin)

  common("o3_topk",
    """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price FROM orders
      |ORDER BY price DESC NULLS LAST, o_orderkey NULLS FIRST LIMIT 25""".stripMargin)

  // O4: UNION deduplicates in both engines (SURVEY hard-part: never
  // bare df.union for this).
  common("o4_union_distinct",
    """SELECT l_returnflag AS f FROM lineitem UNION SELECT o_orderstatus AS f FROM orders
      |ORDER BY f NULLS FIRST""".stripMargin)

  common("o5_union_all",
    """SELECT f, count(*) AS n FROM
      |  (SELECT l_returnflag AS f FROM lineitem UNION ALL SELECT o_orderstatus AS f FROM orders) AS u
      |GROUP BY f ORDER BY f NULLS FIRST""".stripMargin)

  // INTERSECT ≡ distinct(left) SEMI JOIN distinct(right), pre-
  // aggregated for the same reason as o6_except below: map-side
  // combine shrinks both sides before anything shuffles.
  spark("o6_intersect",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT k FROM (SELECT DISTINCT o_custkey AS k FROM orders) o
              |  LEFT SEMI JOIN (SELECT DISTINCT c_custkey AS k2 FROM customer
              |                  WHERE c_mktsegment = 'BUILDING') c ON k <=> k2
              |ORDER BY k""".stripMargin) },
    """SELECT o_custkey AS k FROM orders
      |INTERSECT
      |SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY k""".stripMargin)

  // EXCEPT ≡ distinct(left) ANTI JOIN distinct(right) — but done in
  // that order: Spark's own Except rewrite anti-joins the RAW sides
  // and dedups after, shuffling every fact row; pre-aggregating each
  // side first gets map-side combine before the shuffle (orders'
  // 1.5M keys → ~100k before moving). Null-safe <=> keeps EXCEPT's
  // null-equality semantics. Measured at sf1: 0.98 → 0.46 s.
  spark("o6_except",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT k FROM (SELECT DISTINCT c_custkey AS k FROM customer) c
              |  LEFT ANTI JOIN (SELECT DISTINCT o_custkey AS k2 FROM orders) o
              |    ON k <=> k2
              |ORDER BY k""".stripMargin) },
    """SELECT c_custkey AS k FROM customer
      |EXCEPT
      |SELECT o_custkey AS k FROM orders
      |ORDER BY k""".stripMargin)

  common("o7_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
