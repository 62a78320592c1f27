package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only timing probe for pipeline pieces (not part of the library
  * surface; invoked manually while performance-tuning). */
object DevProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "6")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())
    Tables.registerAll(spark, sfDir)

    val head = """SELECT o_year,
      |  CAST(CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN rev4 ELSE 0 END) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE)
      |    / CAST(CAST(CAST(SUM(rev4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS mkt_share
      |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |        CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4,
      |        n2.n_name AS nation""".stripMargin
    val tail = """) all_nations
      |GROUP BY o_year ORDER BY o_year""".stripMargin

    val vA = head + """
      |      FROM part JOIN lineitem ON p_partkey = l_partkey
      |        JOIN supplier ON s_suppkey = l_suppkey
      |        JOIN orders ON l_orderkey = o_orderkey
      |        JOIN customer ON o_custkey = c_custkey
      |        JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |        JOIN region ON n1.n_regionkey = r_regionkey
      |        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'""".stripMargin + tail

    val vB = head + """
      |      FROM part JOIN lineitem ON p_partkey = l_partkey
      |        JOIN supplier ON s_suppkey = l_suppkey
      |        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |        JOIN (SELECT o_orderkey, o_orderdate
      |              FROM orders JOIN customer ON o_custkey = c_custkey
      |                JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |                JOIN region ON n1.n_regionkey = r_regionkey
      |              WHERE r_name = 'EUROPE') eo ON l_orderkey = eo.o_orderkey
      |      WHERE p_type = 'ECONOMY'""".stripMargin + tail

    val vC = vB.replace("FROM (SELECT CAST(year(o_orderdate)",
      "FROM (SELECT /*+ BROADCAST(eo) */ CAST(year(o_orderdate)")
    val vD = vB.replace("FROM (SELECT CAST(year(o_orderdate)",
      "FROM (SELECT /*+ SHUFFLE_HASH(eo) */ CAST(year(o_orderdate)")

    if (sys.env.contains("IPC_AB")) {
      import graft.sources.vortex.{VortexIpc, VortexFileReader}
      import org.apache.spark.sql.catalyst.InternalRow
      val src = Tables.t(spark, sfDir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_shipdate"))
      val schema = src.schema
      def legacyRows(bytes: Array[Byte]): Iterator[InternalRow] = {
        val (sch, chunks) = VortexIpc.readChunks(new java.io.ByteArrayInputStream(bytes))
        val fields = sch.fields
        chunks.flatMap { case (n, vecs) =>
          (0 until n).iterator.map { i =>
            val vals = new Array[Any](fields.length)
            var c = 0
            while (c < fields.length) {
              vals(c) = VortexFileReader.value(vecs(c), i, fields(c).dataType); c += 1
            }
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
          }
        }
      }
      def agg(back: org.apache.spark.sql.DataFrame) = back.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_key"),
          max(col("l_shipdate")).as("max_ship"),
          sum(col("l_linenumber").cast("long")).as("sum_line"))
        .orderBy("l_returnflag")
      def run(nm: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
        (0 until 4).foreach { r =>
          val t0 = System.nanoTime()
          val n = Bench.force(mk)
          println(f"[ipc] $nm rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
          Thread.sleep(4000)
        }
      run("columnar")(agg(VortexIpc.deserialize(spark, VortexIpc.serialize(src), schema)))
      run("legacy") {
        val rowRdd = VortexIpc.serialize(src).rdd.flatMap(legacyRows)
        agg(org.apache.spark.sql.graft.InternalRowDataFrame.create(spark, rowRdd, schema))
      }
      run("columnar2")(agg(VortexIpc.deserialize(spark, VortexIpc.serialize(src), schema)))
      run("serialize-only")(VortexIpc.serialize(src).toDF("b").select(length(col("b")).as("n")))
      spark.stop(); return
    }

    if (sys.env.contains("FLOOR4")) {
      Tables.registerAll(spark, sfDir)
      def run(nm: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
        (0 until 3).foreach { r =>
          val t0 = System.nanoTime()
          val n = Bench.force(mk)
          println(f"[f4] $nm rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
          Thread.sleep(5000)
        }
      run("q13-cur")(SparkEntry.queries("tpch_q13_custdist")(spark, sfDir))
      run("q13-preagg")(spark.sql(
        """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
          |FROM (SELECT c_custkey, coalesce(n, CAST(0 AS BIGINT)) AS c_count
          |      FROM customer LEFT JOIN
          |        (SELECT o_custkey, count(o_orderkey) AS n FROM orders
          |         WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey) o
          |        ON c_custkey = o_custkey) c_orders
          |GROUP BY c_count
          |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin))
      run("q4-cur")(SparkEntry.queries("tpch_q4_priority")(spark, sfDir))
      run("q4-join-distinct")(spark.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM (SELECT DISTINCT o_orderkey, o_orderpriority
          |      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |        AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          |        AND l_shipdate > o_orderdate) x
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
      run("q22-cur")(SparkEntry.queries("tpch_q22_opportunity")(spark, sfDir))
      run("q22-predist")(spark.sql(
        """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
          |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
          |FROM (SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode, c_acctbal
          |      FROM customer LEFT ANTI JOIN
          |        (SELECT DISTINCT o_custkey FROM orders
          |         WHERE o_orderpriority = '1-URGENT') u ON o_custkey <=> c_custkey
          |      WHERE c_custkey % 7 IN (1, 2, 3, 4, 5)
          |        AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          |                         FROM customer c2
          |                         WHERE c2.c_acctbal > 0 AND c2.c_custkey % 7 IN (1, 2, 3, 4, 5))) custsale
          |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin))
      run("j4-cur")(SparkEntry.queries("j4_anti")(spark, sfDir))
      run("j4-predist") {
        val c = Tables.t(spark, sfDir, "customer")
        val o = Tables.t(spark, sfDir, "orders").select(col("o_custkey")).distinct()
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
      }
      run("q11-cur")(SparkEntry.queries("tpch_q11_important")(spark, sfDir))
      run("q11-window")(spark.sql(
        """SELECT l_partkey, CAST(v AS DOUBLE) AS value
          |FROM (SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS v,
          |        SUM(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))) OVER () AS tot
          |      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          |        JOIN nation ON s_nationkey = n_nationkey
          |      WHERE n_name = 'NATION_2'
          |      GROUP BY l_partkey) t
          |WHERE CAST(v AS DOUBLE) > CAST(tot AS DOUBLE) * 0.001
          |ORDER BY value DESC NULLS LAST, l_partkey""".stripMargin))
      run("j3-cur")(SparkEntry.queries("j3_semi")(spark, sfDir))
      run("j3-predist") {
        val c = Tables.t(spark, sfDir, "customer")
        val o = Tables.t(spark, sfDir, "orders").select(col("o_custkey")).distinct()
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
      }
      run("a8-cur")(SparkEntry.queries("a8_having")(spark, sfDir))
      run("a8-rangeagg")(spark.sql(
        """SELECT l_orderkey, count(*) AS n
          |FROM (SELECT /*+ REPARTITION_BY_RANGE(l_orderkey) */ l_orderkey FROM lineitem) l
          |GROUP BY l_orderkey HAVING count(*) >= 5
          |SORT BY l_orderkey""".stripMargin))
      run("q7-cur")(SparkEntry.queries("tpch_q7_volume")(spark, sfDir))
      run("q7-twoleg")(spark.sql(
        """SELECT supp_nation, cust_nation, l_year,
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
          |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))
      run("q15-cur")(SparkEntry.queries("tpch_q15_top_supplier")(spark, sfDir))
      run("q15-window")(spark.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS total_revenue
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS revenue
          |FROM supplier JOIN
          |  (SELECT supplier_no, total_revenue FROM
          |     (SELECT supplier_no, total_revenue, MAX(total_revenue) OVER () AS mx FROM revenue) t
          |   WHERE total_revenue = mx) r ON s_suppkey = supplier_no
          |ORDER BY s_suppkey""".stripMargin))
      run("q12-cur")(SparkEntry.queries("tpch_q12_shipmode")(spark, sfDir))
      run("q12-shufhash")(spark.sql(
        """SELECT /*+ SHUFFLE_HASH(orders) */ l_returnflag,
          |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |  AND l_shipdate > o_orderdate
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
      run("a7-cur")(SparkEntry.queries("a7_filter_agg")(spark, sfDir))
      run("a7-cents")(spark.sql(
        """SELECT o_orderpriority, count(*) AS n_all,
          |  count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
          |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DECIMAL(20,0)) / 100 AS DOUBLE) AS sum_f
          |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
      run("q5-cur")(SparkEntry.queries("tpch_q5_local_supplier")(spark, sfDir))
      run("q5-eo")(spark.sql(
        """SELECT n_name,
          |  CAST(CAST(CAST(SUM(rev4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS revenue
          |FROM (SELECT /*+ SHUFFLE_HASH(eo) */ eo.n_name, l.rev4
          |      FROM (SELECT l_orderkey, l_suppkey,
          |              CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
          |            FROM lineitem) l
          |        JOIN (SELECT o_orderkey, c_nationkey AS eo_nationkey, n_name
          |              FROM orders JOIN customer ON c_custkey = o_custkey
          |                JOIN nation ON c_nationkey = n_nationkey
          |                JOIN region ON n_regionkey = r_regionkey
          |              WHERE r_name = 'AMERICA') eo ON l.l_orderkey = eo.o_orderkey
          |        JOIN supplier ON l.l_suppkey = s_suppkey AND eo.eo_nationkey = s_nationkey) j
          |GROUP BY n_name ORDER BY revenue DESC NULLS LAST, n_name""".stripMargin))
      spark.stop(); return
    }

    if (sys.env.contains("FLOOR3")) {
      Tables.registerAll(spark, sfDir)
      def run(nm: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
        (0 until 3).foreach { r =>
          val t0 = System.nanoTime()
          val n = Bench.force(mk)
          println(f"[f3] $nm rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
          Thread.sleep(5000)
        }
      run("tokens-cur")(SparkEntry.queries("t_tokens")(spark, sfDir))
      run("tokens-rangepart")(Tables.t(spark, sfDir, "documents")
        .repartitionByRange(col("doc_id"))
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws"),
          regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("n_tok"),
          length(col("text")).cast("long").as("n_char"))
        .sortWithinPartitions("doc_id"))
      run("j2left-cur")(SparkEntry.queries("j2_left")(spark, sfDir))
      run("j2left-preagg")(spark.sql(
        """SELECT c_custkey, c_name, coalesce(n, CAST(0 AS BIGINT)) AS n_orders
          |FROM customer LEFT JOIN
          |  (SELECT o_custkey, count(o_orderkey) AS n FROM orders GROUP BY o_custkey) o
          |  ON c_custkey = o_custkey
          |ORDER BY c_custkey""".stripMargin))
      run("q9-cur")(SparkEntry.queries("tpch_q9_profit")(spark, sfDir))
      run("q9-shufhash")(spark.sql(
        """SELECT nation, o_year,
          |  CAST(CAST(CAST(SUM(amount4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(30,6)) AS DOUBLE) AS sum_profit
          |FROM (SELECT /*+ SHUFFLE_HASH(orders) */ n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |        CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))
          |          - CAST(round(p_retailprice * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT) AS amount4
          |      FROM part JOIN lineitem ON p_partkey = l_partkey
          |        JOIN supplier ON s_suppkey = l_suppkey
          |        JOIN orders ON o_orderkey = l_orderkey
          |        JOIN nation ON s_nationkey = n_nationkey
          |      WHERE p_name LIKE '%red%') profit
          |GROUP BY nation, o_year ORDER BY nation, o_year DESC NULLS LAST""".stripMargin))
      run("fp-cur")(SparkEntry.queries("t_fingerprint")(spark, sfDir))
      run("fp-rangepart") {
        import spark.implicits._
        import graft.functions.Hashing
        Tables.t(spark, sfDir, "documents")
          .repartitionByRange(col("doc_id"))
          .select("doc_id", "text").as[(Long, String)]
          .map { case (id, text) =>
            val canon = text.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
            val nSh = math.max(canon.length - 7, 1)
            var best: Array[Byte] = null
            var i = 0
            while (i < nSh) {
              val h = Hashing.md5bytes(canon.substring(i, math.min(i + 8, canon.length)))
              if (best == null || Hashing.byteLess(h, best)) best = h
              i += 1
            }
            (id, Hashing.md5hex(canon), Hashing.toHex(best))
          }
          .toDF("doc_id", "fp", "min_shingle")
          .sortWithinPartitions("doc_id")
      }
      run("j1-cur")(SparkEntry.queries("j1_inner")(spark, sfDir))
      run("j1-rangepart")(
        Tables.t(spark, sfDir, "orders")
          .repartitionByRange(col("o_orderkey"))
          .join(broadcast(Tables.t(spark, sfDir, "customer")),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
            col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
          .sortWithinPartitions("o_orderkey"))
      run("md5-cur")(SparkEntry.queries("f2_md5")(spark, sfDir))
      run("md5-rangepart")(spark.sql(
        """SELECT o_orderkey, md5(CAST(o_orderkey AS STRING)) AS h
          |FROM (SELECT /*+ REPARTITION_BY_RANGE(o_orderkey) */ o_orderkey FROM orders) o
          |SORT BY o_orderkey""".stripMargin))
      run("dt-cur")(SparkEntry.queries("f_datetime")(spark, sfDir))
      run("dt-rangepart")(spark.sql(
        """SELECT event_id, CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
          |  CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
          |  CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ) AS day_ts, CAST(ts AS DATE) AS dt
          |FROM (SELECT /*+ REPARTITION_BY_RANGE(event_id) */ event_id, ts FROM events) e
          |SORT BY event_id""".stripMargin))
      run("math2-cur")(SparkEntry.queries("f_math2")(spark, sfDir))
      run("math2-rangepart")(spark.sql(
        """SELECT o_orderkey,
          |  CAST(sign(o_orderkey % 5 - 2) AS BIGINT) AS sg,
          |  mod(o_orderkey, 97) AS md,
          |  CAST(CAST(round(log10(CAST(o_orderkey + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS l10,
          |  CAST(CAST(round(log2(CAST(o_orderkey + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS l2,
          |  o_orderkey & 255 AS band, o_orderkey | 7 AS bor, o_orderkey ^ 255 AS bxor
          |FROM (SELECT /*+ REPARTITION_BY_RANGE(o_orderkey) */ o_orderkey FROM orders) o
          |SORT BY o_orderkey""".stripMargin))
      spark.stop(); return
    }

    if (sys.env.contains("FLOOR2")) {
      import org.apache.spark.sql.types.DecimalType
      Tables.registerAll(spark, sfDir)
      def run(nm: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
        (0 until 3).foreach { r =>
          val t0 = System.nanoTime()
          val n = Bench.force(mk)
          println(f"[f2] $nm rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
          Thread.sleep(5000)
        }
      run("intersect-cur")(spark.sql(
        """SELECT o_custkey AS k FROM orders
          |INTERSECT
          |SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
          |ORDER BY k""".stripMargin))
      run("intersect-predist")(spark.sql(
        """SELECT k FROM (SELECT DISTINCT o_custkey AS k FROM orders) o
          |  LEFT SEMI JOIN (SELECT DISTINCT c_custkey AS k2 FROM customer
          |                  WHERE c_mktsegment = 'BUILDING') c ON k <=> k2
          |ORDER BY k""".stripMargin))
      run("sliding-cur")(SparkEntry.queries("e_sliding_window")(spark, sfDir))
      run("sliding-tiny")(graft.operators.TinyResult.globalSort(
        Tables.t(spark, sfDir, "events")
          .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("ws"), col("event_type"), col("n")),
        col("ws"), col("event_type")))
      run("w1-cur")(SparkEntry.queries("w1_rank")(spark, sfDir))
      run("w1-rangepart") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.t(spark, sfDir, "orders")
          .repartitionByRange(col("o_custkey"))
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).cast("bigint").as("rn"),
            rank().over(w).cast("bigint").as("rk"),
            dense_rank().over(w).cast("bigint").as("drk"),
            ntile(4).over(w).cast("bigint").as("nt"))
          .filter(col("rn") <= 3)
          .sortWithinPartitions("o_custkey", "rn")
      }
      run("sessions-cur")(SparkEntry.queries("e_sessions")(spark, sfDir))
      run("sessions-rangepart")(spark.sql(
        """WITH g AS (
          |  SELECT user_id, ts, event_id, value,
          |    CASE WHEN lag(ts) OVER w IS NULL
          |           OR unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
          |         THEN 1 ELSE 0 END AS brk
          |  FROM (SELECT /*+ REPARTITION_BY_RANGE(user_id) */ * FROM events) e
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                              ROWS UNBOUNDED PRECEDING) AS sid FROM g)
          |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n, min(ts) AS session_start, max(ts) AS session_end,
          |  CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DECIMAL(20,0)) / 100 AS DOUBLE) AS sum_v
          |FROM s GROUP BY user_id, sid
          |SORT BY user_id, sid""".stripMargin))
      run("gaps-cur")(SparkEntry.queries("e_user_gaps")(spark, sfDir))
      run("gaps-isolate")(spark.sql(
        """SELECT /*+ REPARTITION(event_id) */ event_id, user_id,
          |  unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) AS gap_us
          |FROM events ORDER BY event_id""".stripMargin))
      spark.stop(); return
    }

    if (sys.env.contains("FLOOR_AB")) {
      import org.apache.spark.sql.types.DecimalType
      def run(nm: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
        (0 until 3).foreach { r =>
          val t0 = System.nanoTime()
          val n = Bench.force(mk)
          println(f"[floor] $nm rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
          Thread.sleep(5000)
        }
      def tumblingBase = Tables.t(spark, sfDir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_v"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_v"))
      run("tumbling-current")(tumblingBase.orderBy("ws", "event_type"))
      run("tumbling-nosort")(tumblingBase)
      run("tumbling-tiny")(graft.operators.TinyResult.globalSort(
        tumblingBase, col("ws"), col("event_type")))

      Tables.registerAll(spark, sfDir)
      run("except-current")(spark.sql(
        """SELECT c_custkey AS k FROM customer
          |EXCEPT
          |SELECT o_custkey AS k FROM orders
          |ORDER BY k""".stripMargin))
      run("except-nosort")(spark.sql(
        """SELECT c_custkey AS k FROM customer
          |EXCEPT
          |SELECT o_custkey AS k FROM orders""".stripMargin))
      run("except-predistinct")(spark.sql(
        """SELECT k FROM (SELECT DISTINCT c_custkey AS k FROM customer) c
          |  LEFT ANTI JOIN (SELECT DISTINCT o_custkey AS k2 FROM orders) o ON k = k2
          |ORDER BY k""".stripMargin))

      run("w4range-current")(SparkEntry.queries("w4_range_frame")(spark, sfDir))
      run("w4range-nosort")(spark.sql(
        """SELECT o_custkey, o_orderkey,
          |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
          |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT) AS n_near
          |FROM orders""".stripMargin))
      run("w4range-rangepart") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").cast(DecimalType(18, 2)))
          .rangeBetween(-1000, 1000)
        Tables.t(spark, sfDir, "orders")
          .repartitionByRange(col("o_custkey"))
          .select(col("o_custkey"), col("o_orderkey"),
            count(lit(1)).over(w).cast("bigint").as("n_near"))
          .sortWithinPartitions("o_custkey", "o_orderkey")
      }
      run("w4range-rangepart-cents") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .rangeBetween(-100000, 100000)
        Tables.t(spark, sfDir, "orders")
          .repartitionByRange(col("o_custkey"))
          .select(col("o_custkey"), col("o_orderkey"),
            count(lit(1)).over(w).cast("bigint").as("n_near"))
          .sortWithinPartitions("o_custkey", "o_orderkey")
      }
      run("w4run-current")(SparkEntry.queries("w4_running_sum")(spark, sfDir))
      run("w4run-rangepart-cents") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.t(spark, sfDir, "orders")
          .repartitionByRange(col("o_custkey"))
          .select(col("o_custkey"), col("o_orderkey"),
            (sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).over(w)
              .cast(DecimalType(20, 0)) / lit(100)).cast("double").as("running"))
          .sortWithinPartitions("o_custkey", "o_orderkey")
      }
      run("tumbling-datetrunc")(Tables.t(spark, sfDir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_v"))
        .orderBy("ws", "event_type"))
      run("tumbling-cents")(Tables.t(spark, sfDir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DECIMAL(20,0)) / 100 AS DOUBLE)").as("sum_v"))
        .orderBy("ws", "event_type"))
      spark.stop(); return
    }

    // percentile materialize A/B (histogram path forced via maxSmallRows=0)
    if (sys.env.contains("PCT_AB")) {
      val specs = Seq(("l_quantity", Seq(0.5, 0.9), Seq("p50r", "p90r")),
                      ("l_extendedprice", Seq(0.25), Seq("p25r")))
      def run(nm: String)(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit =
        (0 until 3).foreach { r =>
          val li = Tables.t(spark, sfDir, "lineitem")
          val t0 = System.nanoTime()
          val n = Bench.force(mk(li))
          println(f"[pct] $nm rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
          Thread.sleep(6000)
        }
      def auto(li: org.apache.spark.sql.DataFrame) =
        graft.operators.ExactPercentile.computeMultiAuto(
          li, "l_returnflag", specs, maxSmallRows = 16000000)
      run("bare")(auto)
      run("bare+cast")(li => auto(li).selectExpr("l_returnflag",
        "CAST(CAST(p50r AS DECIMAL(18,4)) AS DOUBLE) AS p50",
        "CAST(CAST(p90r AS DECIMAL(18,4)) AS DOUBLE) AS p90",
        "CAST(CAST(p25r AS DECIMAL(18,4)) AS DOUBLE) AS p25_price"))
      run("bare+sort")(li => auto(li).orderBy("l_returnflag"))
      run("bare+rep1sort")(li =>
        auto(li).repartition(1).sortWithinPartitions("l_returnflag"))
      spark.stop(); return
    }

    Seq("A-current" -> vA, "B-eo-subtree" -> vB,
        "C-bcast-eo" -> vC, "D-shufhash-eo" -> vD).foreach { case (nm, q) =>
      val df = spark.sql(q)
      if (sys.env.contains("Q8_EXPLAIN")) { println(s"=== $nm ==="); df.explain("formatted") }
      (0 until 3).foreach { r =>
        val t0 = System.nanoTime()
        val n = Bench.force(spark.sql(q))
        println(f"[q8] $nm rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
        Thread.sleep(6000)
      }
      println(s"[q8] $nm result: " + df.collect().map(_.toString).mkString(" "))
      Thread.sleep(4000)
    }
    spark.stop()
  }
}
