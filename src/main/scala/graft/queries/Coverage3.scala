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

  // sampling: nondeterministic across engines → rows-only check; seeded
  // so it is at least reproducible within Spark
  sparkOnly("q_sample",
    (s, d) => Tables.t(s, d, "lineitem").sample(withReplacement = false, 0.1, seed = 42)
      .agg(count(lit(1)).as("n")))
}
