package graft
import org.apache.spark.sql.functions._

/** r13 decomposition probe (VERDICT r12 next #4/#5/#8): measure the
  * component floors under the weak sf1 rows — bare pruned scans, one
  * exchange, the operator core without its final sort — so each row
  * either gets a plan change or a BASELINE.md pin with the constant
  * named (the Q5Probe/J6Probe precedent). Warm JVM, best of 3.
  * Usage: runMain graft.FloorProbe <sfDir> */
object FloorProbe extends App {
  val sfDir = args(0)
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  import spark.implicits._
  graft.Tables.names.foreach(n => graft.Tables.t(spark, sfDir, n).count())

  def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
    val times = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      Bench.force(df)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[floor] $name%-34s best ${times.min}%.3f s  (${times.map(t => f"$t%.2f").mkString(",")})")
  }

  val li = Tables.t(spark, sfDir, "lineitem")
  val o = Tables.t(spark, sfDir, "orders")
  val docs = Tables.t(spark, sfDir, "documents")
  val emb = Tables.t(spark, sfDir, "embeddings")

  // scheduler constant: an empty-ish 6-task job
  time("job_constant")(spark.range(0, 6L, 1, 6).toDF("i"))
  // bare pruned scans (the Q5Probe floor, re-pinned this round)
  time("scan_lineitem_3col")(li.select("l_orderkey", "l_extendedprice", "l_discount"))
  time("scan_orders_3col")(o.select("o_orderkey", "o_custkey", "o_totalprice"))
  time("scan_documents_text")(docs.select("doc_id", "text"))
  time("scan_embeddings")(emb.select("vec_id", "embedding"))
  // one hash exchange over orders (w1's first shuffle)
  time("orders_exchange_count")(
    o.groupBy("o_custkey").agg(count(lit(1)).as("n")))
  // w1 core: exchange + sort + window + filter, NO final global sort
  def w1core = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("nt", ntile(4).over(w))
      .filter(col("rn") <= 3).drop("o_totalprice")
  }
  time("w1_core_nosort")(w1core)
  time("w1_core_plus_globalsort")(w1core.orderBy("o_custkey", "rn"))
  // j8 core: the fact pre-agg exchange alone
  time("j8_fact_agg")(
    li.select(col("l_orderkey"),
      (round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev4"))
      .groupBy("l_orderkey")
      .agg(sum(col("rev4")).as("rev4"), count(lit(1)).as("cnt")))
  // q21 core: the lineitem⋈orders filtered join + per-order agg
  time("q21_join_agg")(
    li.select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o.where(col("o_orderstatus") === "F")
              .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(sum(when(col("l_shipdate") > col("o_orderdate"), 1).otherwise(0)).as("late_cnt")))
  // percentile: both gate sides, explicitly
  time("pct_histogram_forced")(
    graft.operators.ExactPercentile.computeMulti(
      li, "l_returnflag",
      Seq(("l_quantity", Seq(0.5, 0.9), Seq("p50r", "p90r")),
          ("l_extendedprice", Seq(0.25), Seq("p25r")))))
  time("pct_auto_gate")(
    graft.operators.ExactPercentile.computeMultiAuto(
      li, "l_returnflag",
      Seq(("l_quantity", Seq(0.5, 0.9), Seq("p50r", "p90r")),
          ("l_extendedprice", Seq(0.25), Seq("p25r")))))
  // rrf legs
  time("rrf_lex_leg")(
    graft.queries.RetrievalOps.bm25Scores(spark, sfDir)
      .orderBy(desc("s6"), asc("doc_id")).limit(50))
  // r14 (VERDICT r13 next #5): the two unpinned >2x rows
  // q8 legs: both fact sides are dimension-reduced before they meet
  graft.Tables.registerAll(spark, sfDir)
  time("q8_eo_leg")(spark.sql(
    """SELECT o_orderkey, o_orderdate
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'""".stripMargin))
  time("q8_li_leg")(spark.sql(
    """SELECT l_orderkey, l_extendedprice, l_discount, n2.n_name
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'ECONOMY'""".stripMargin))
  time("q8_full_row")(
    graft.SparkEntry.queries("tpch_q8_mktshare")(spark, sfDir))
  // t_pack_blocks: tokenize vs prefix-sum vs final sort
  def packToks = docs.select(col("doc_id"),
    size(split(col("text"), " ")).cast("long").as("n_tok"), lit(0).as("__g"))
  time("pack_tokenize_split")(packToks)
  time("pack_tokenize_spacecount")(docs.select(col("doc_id"),
    (org.apache.spark.sql.graft.GraftSqlBridge.column(
      graft.functions.CodepointRangeCount(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("text"),
        0x20, 0x20)).cast("long") + lit(1L)).as("n_tok")))
  time("pack_prefixsum")(graft.operators.PrefixSum
    .groupedCumSum(packToks, "__g", "doc_id", "n_tok", "cum_tok"))
  time("pack_full_nosort")({
    val B = 128L
    graft.operators.PrefixSum
      .groupedCumSum(packToks, "__g", "doc_id", "n_tok", "cum_tok")
      .withColumn("start_tok", col("cum_tok") - col("n_tok"))
      .withColumn("blk_first", floor(col("start_tok") / B).cast("long"))
      .withColumn("blk_last", floor((col("cum_tok") - 1) / B).cast("long"))
      .withColumn("n_blocks", col("blk_last") - col("blk_first") + 1)
      .select("doc_id", "n_tok", "start_tok", "blk_first", "blk_last", "n_blocks")
  })
  time("pack_full_row")(
    graft.SparkEntry.queries("t_pack_blocks")(spark, sfDir))
  // e_sessions (r14: first round over the bar at 2.1x / 2.62 s):
  // scan -> one user_id exchange + sort -> lag window + running-sum
  // window (same spec, one sort) -> agg (exchange-free: user_id
  // partitioning satisfies the (user_id, sid) clustering) -> final
  // global sort over ~#sessions rows
  val ev = Tables.t(spark, sfDir, "events")
  time("sessions_scan")(ev.select("user_id", "ts", "event_id", "value"))
  def sessionsCore = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    ev.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          (unix_micros(col("ts").cast("timestamp")) - unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))) >
            lit(1800000000L), 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
  }
  time("sessions_core_nosort")(sessionsCore)
  time("sessions_core_plus_sort")(sessionsCore.orderBy("user_id", "sid"))
  time("sessions_full_row")(
    graft.SparkEntry.queries("e_sessions")(spark, sfDir))
  // maintenance-family staging constant: the vortex dataset write that
  // opens every s14/s15/s16 timed region (orders, 4-file range layout)
  time("maint_stage_orders")({
    val dir = s"${sys.props("java.io.tmpdir")}/graft_probe_stage_orders"
    o.repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      .write.format("vortex").mode("overwrite").save(dir)
    spark.read.format("vortex").load(dir).select(count(lit(1)).as("n"))
  })
  time("rrf_dense_leg")({
    import graft.functions.VecFixedPoint
    val vecs = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
    val qv = emb.where(col("vec_id") === 7L)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].head()
    val q = VecFixedPoint.quantize(qv._2)
    val qsaa = VecFixedPoint.dot(q, q)
    val bq = spark.sparkContext.broadcast((q, qsaa))
    vecs.map { case (id, e) =>
      val c = VecFixedPoint.quantize(e)
      (id, VecFixedPoint.cos(VecFixedPoint.dot(bq.value._1, c), bq.value._2,
        VecFixedPoint.dot(c, c)))
    }.toDF("id", "cosd").orderBy(desc("cosd"), asc("id")).limit(50)
  })
  spark.stop()
}
