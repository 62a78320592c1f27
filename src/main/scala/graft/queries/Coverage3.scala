package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Third coverage wave: ordered string aggregation, boolean
  * aggregates, arg-max/min, explode/unnest, sampling.
  */
object Coverage3 {
  val set = new QuerySet
  import set._

  // ordered string aggregation (DuckDB string_agg ORDER BY ↔ Spark
  // sort_array(collect_list) — deterministic via the sort)
  spark("a_string_agg",
    (s, d) => Tables.t(s, d, "orders")
      .groupBy("o_orderpriority")
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus")))).as("statuses"),
           count(lit(1)).as("n"))
      .orderBy("o_orderpriority"),
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  common("a_bool_agg",
    """SELECT l_returnflag,
      |  bool_and(l_quantity > 0) AS all_pos,
      |  bool_or(l_discount > 0.09) AS any_big_disc,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)

  // arg-max/min with a unique ordering value (ties broken by orderkey)
  spark("a_arg_max",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""SELECT o_custkey,
              |  max_by(o_orderkey, (unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 1000000) * 1000000000 + o_orderkey) AS latest_order,
              |  min_by(o_orderkey, (unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 1000000) * 1000000000 + o_orderkey) AS first_order
              |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) },
    """SELECT o_custkey,
      |  arg_max(o_orderkey, (epoch_us(o_orderdate) // 1000000) * 1000000000 + o_orderkey) AS latest_order,
      |  arg_min(o_orderkey, (epoch_us(o_orderdate) // 1000000) * 1000000000 + o_orderkey) AS first_order
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)

  // explode / unnest
  spark("q_explode",
    (s, d) => Tables.t(s, d, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .orderBy("doc_id", "w"),
    """SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      |FROM documents ORDER BY doc_id, w""".stripMargin)

  // Recursive iteration (WITH RECURSIVE twin): ancestor closure over
  // a parent edge set derived from part (child k → parent k/2, a
  // ~7-deep binary-tree walk). Spark side runs
  // Fixpoint.recursiveUnion — semi-naive driver-looped fixpoint,
  // UNION-distinct semantics, every row distributed; the oracle is a
  // literal DuckDB WITH RECURSIVE over the identical edges.
  spark("q_recursive",
    (s, d) => {
      val part = Tables.t(s, d, "part")
      val edges = part.filter(col("p_partkey") >= 1)
        .select(col("p_partkey").as("child"),
          (col("p_partkey") / 2).cast("long").as("parent"))
      // fixed 50-key start band: output and round count stay constant
      // across SFs while the EDGE set (what the recursion probes each
      // round) grows with the data; keys 50-99 exist at every SF and
      // give a ~7-round recursion (each round is a sequential job —
      // depth is wall-clock, so the demo uses a band deep enough to be
      // a real recursion and no deeper)
      val base = part.filter(col("p_partkey").between(50, 99))
        .select(col("p_partkey").as("start"), col("p_partkey").as("node"),
          lit(0L).as("depth"))
      // depth strictly increases over an acyclic parent function, so
      // the UNION ALL form applies: one job per round, no per-round
      // dedup shuffle (the UNION-distinct form is recursiveUnion,
      // cycle-proven in FixpointSpec)
      val closure = graft.operators.Fixpoint.recursiveUnionAll(base, fr =>
        // frontier is ≤ |starts| rows per round — broadcast it so each
        // round is a map-side probe of the (large, at scale) edge set.
        // kernelCap (r15): deltas are ≤ |starts| rows, so the frontier
        // rides the bounded driver kernel — LocalRelation frontiers
        // broadcast with no collect job, one Spark job per round
        // (18 jobs / 1.48 s -> 10 jobs, see BASELINE.md r15)
        edges.join(broadcast(fr), col("child") === col("node"))
          .select(col("start"), col("parent").as("node"),
            (col("depth") + 1).as("depth")), maxRounds = 64,
        kernelCap = 10000)
      closure.groupBy("start")
        .agg(count(lit(1)).as("n_anc"), max(col("depth")).as("max_depth"))
        .orderBy("start")
    },
    """WITH RECURSIVE edges AS (
      |  SELECT p_partkey AS child, p_partkey // 2 AS parent
      |  FROM part WHERE p_partkey >= 1),
      |anc AS (
      |  SELECT p_partkey AS start, p_partkey AS node, CAST(0 AS BIGINT) AS depth
      |  FROM part WHERE p_partkey BETWEEN 50 AND 99
      |  UNION ALL
      |  SELECT a.start, e.parent AS node, a.depth + 1 AS depth
      |  FROM anc a JOIN edges e ON e.child = a.node)
      |SELECT start, count(*) AS n_anc, CAST(max(depth) AS BIGINT) AS max_depth
      |FROM anc GROUP BY start ORDER BY start""".stripMargin)

  // sampling: nondeterministic across engines → rows-only check; seeded
  // so it is at least reproducible within Spark
  sparkOnly("q_sample",
    (s, d) => Tables.t(s, d, "lineitem").sample(withReplacement = false, 0.1, seed = 42)
      .agg(count(lit(1)).as("n")))
}
