package graft.queries

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Builder for oracle-checked query suites.
  *
  * Determinism conventions (SURVEY.md §2 t2 discipline):
  *  - every query ends with ORDER BY over a unique key, with null
  *    ordering pinned explicitly on the DuckDB side (Spark defaults:
  *    ASC = NULLS FIRST, DESC = NULLS LAST);
  *  - float aggregates are computed in DECIMAL (inputs cast to
  *    DECIMAL(18,2) *before* aggregation) so results are exact and
  *    independent of partial-aggregation order on a cluster;
  *  - session TZ is UTC on both engines.
  */
final class QuerySet {
  type Fn = (SparkSession, String) => DataFrame

  private val qs = mutable.LinkedHashMap[String, Fn]()
  private val os = mutable.LinkedHashMap[String, String]()
  private val bos = mutable.LinkedHashMap[String, String]()

  /** Same ANSI SQL text runs on Spark and on the DuckDB oracle. */
  def common(name: String, sqlText: String): Unit = {
    qs(name) = (s, d) => { Tables.registerAll(s, d); s.sql(sqlText) }
    os(name) = sqlText
  }

  /** DataFrame-API query with a separately written DuckDB oracle. */
  def spark(name: String, fn: Fn, oracleSql: String): Unit = {
    qs(name) = fn; os(name) = oracleSql
  }

  /** Not SQL-expressible in DuckDB → driver does a rows-only check. */
  def sparkOnly(name: String, fn: Fn): Unit = qs(name) = fn

  /** Rows-only for the driver's correctness check (the DuckDB twin is
    * a statement like COPY that returns no relation through the Python
    * API), but with a symmetric DuckDB statement for the BENCH baseline
    * harness (tools/baseline.py) to time. */
  def sparkBench(name: String, fn: Fn, benchSql: String): Unit = {
    qs(name) = fn; bos(name) = benchSql
  }

  def queries: Map[String, Fn] = qs.toMap
  def oracle: Map[String, String] = os.toMap
  /** bench-only DuckDB twins (never in the correctness oracle set) */
  def benchOracle: Map[String, String] = bos.toMap
  def orderedNames: Seq[String] = qs.keys.toSeq
}
