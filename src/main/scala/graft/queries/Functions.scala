package graft.queries

/** SURVEY.md §2.7 scalar-function families: the functions the
  * reference's tests exercise (concat, md5, date/interval arithmetic,
  * timestamp filters — table.test:43-49, timestamp.test:19-47) plus
  * the DuckDB↔Spark-common parity set (string/date/math/conditional).
  * All per-row (no aggregation) → order-deterministic by construction;
  * doubles only where both engines compute identical IEEE results.
  */
object Functions {
  val set = new QuerySet
  import set._

  // F1: `'Value ' || seq` (reference table.test:43)
  common("f1_concat",
    """SELECT o_orderkey, 'Value ' || CAST(o_orderkey AS VARCHAR(30)) AS label
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  // F2: md5(varchar) (reference table.test:49)
  // plan note: SortThroughProject pushes the ORDER BY below the md5
  // projection (1.60 → 0.59 s at sf1)
  common("f2_md5",
    """SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR(30))) AS h
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  // F3: date + n days (reference table.test:44 to_days analog)
  spark("f3_date_add",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT l_orderkey, l_linenumber, date_add(CAST(l_shipdate AS DATE), 30) AS d30
              |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) },
    """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) + 30 AS d30
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // F4: timestamp + interval seconds (reference table.test:45-48)
  common("f4_ts_interval",
    """SELECT l_orderkey, l_linenumber, l_shipdate + INTERVAL 90 SECOND AS ts90
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // F4b: the timestamp-literal filter proof (reference timestamp.test:38-47)
  common("f4_ts_filter",
    "SELECT count(*) AS n FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'")

  // F5: timestamp→date comparison across precisions
  common("f5_ts_date",
    "SELECT count(*) AS n FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'")

  // String family (regexp split out: Spark regexp_like vs DuckDB regexp_matches)
  common("f_string",
    """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
      |  trim(p_type) AS tr, substr(p_name, 1, 8) AS sub,
      |  replace(p_type, ' ', '_') AS rep, CAST(length(p_name) AS BIGINT) AS len,
      |  CASE WHEN p_name LIKE '%le%' THEN 1 ELSE 0 END AS has_le
      |FROM part ORDER BY p_partkey""".stripMargin)

  spark("f_regexp",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT p_partkey,
              |  CASE WHEN regexp_like(p_name, '^[a-m]') THEN 1 ELSE 0 END AS re_am,
              |  regexp_replace(p_type, '[aeiou]', '.') AS re_sub,
              |  regexp_extract(p_name, '([a-z]+)', 1) AS re_first
              |FROM part ORDER BY p_partkey""".stripMargin) },
    """SELECT p_partkey,
      |  CASE WHEN regexp_matches(p_name, '^[a-m]') THEN 1 ELSE 0 END AS re_am,
      |  regexp_replace(p_type, '[aeiou]', '.', 'g') AS re_sub,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS re_first
      |FROM part ORDER BY p_partkey""".stripMargin)

  // Spark's plain TIMESTAMP is tz-aware; cast the truncation back to
  // NTZ so the parquet output matches DuckDB's naive TIMESTAMP.
  // plan note: SortThroughProject pushes the ORDER BY below the
  // field-extraction projection (1.49 → 0.68 s at sf1)
  spark("f_datetime",
    (s, d) => { graft.Tables.registerAll(s, d)
      s.sql("""SELECT event_id, CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
              |  CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
              |  CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ) AS day_ts, CAST(ts AS DATE) AS dt
              |FROM events ORDER BY event_id""".stripMargin) },
    """SELECT event_id, CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
      |  CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
      |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts, CAST(ts AS DATE) AS dt
      |FROM events ORDER BY event_id""".stripMargin)

  common("f_math",
    """SELECT p_partkey,
      |  CAST(abs(p_size - 25) AS BIGINT) AS ab,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
      |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
      |  CAST(CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DECIMAL(18,1)) AS DOUBLE) AS rd,
      |  CAST(CAST(round(sqrt(CAST(p_size AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS sq,
      |  CAST(CAST(round(ln(CAST(p_partkey + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS lg,
      |  CAST(power(CAST(p_size AS DOUBLE), 2) AS BIGINT) AS pw
      |FROM part ORDER BY p_partkey""".stripMargin)

  common("f_cond",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS st,
      |  greatest(o_orderkey, o_custkey) AS g, least(o_orderkey, o_custkey) AS l
      |FROM orders ORDER BY o_orderkey""".stripMargin)
}
