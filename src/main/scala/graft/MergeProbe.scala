package graft
import org.apache.spark.sql.functions._

/** r15 (VERDICT r14 next #2): decompose the MERGE per-statement
  * constant behind the worst real maintenance ratios (s16b 8.1x,
  * s16c 6.4x, s16 5.2x at sf1). Phases, each timed on a FRESHLY staged
  * dataset so mutations don't compound:
  *
  *   stage        VortexBulkCopy of customer (shared with every row)
  *   src_build    source DataFrame collect (bounded broadcast input)
  *   noop_merge   1-row never-matching source, no NMBS — everything
  *                EXCEPT rewrites: lease + repair walk + commit-log
  *                begin + candidate planning + untouched-file commit
  *   s16_sql      the full s16 SQL MERGE (update-all + insert-all)
  *   s16_direct   the same statement via VortexMerge.merge directly —
  *                the SQL-layer (parse/analyze/rule) delta
  *   s16b_sql     conditional clauses (delete/update/insert)
  *   s16c_sql     + NOT MATCHED BY SOURCE (full-candidate shape)
  *   readback     the group-by read-back aggregate alone
  *
  * Usage: runMain graft.MergeProbe <sfDir>
  */
object MergeProbe extends App {
  val sfDir = args(0)
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[6]")
    .config("spark.sql.shuffle.partitions", 6)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  graft.plans.RewriteVortexDml.install(spark)
  spark.conf.set("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")

  val cust = Tables.t(spark, sfDir, "customer")
  cust.count() // warm

  val dir = s"${sys.props("java.io.tmpdir")}/graft_probe_merge"
  def freshStage(): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    graft.sources.vortex.VortexBulkCopy.copy(cust, dir)
  }

  def time(name: String, staged: Boolean = true)(body: => Unit): Unit = {
    val times = (0 until 3).map { _ =>
      if (staged) freshStage()
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println(f"[merge] $name%-22s best ${times.min}%.3f s (${times.map(t => f"$t%.2f").mkString(",")})")
  }

  // ---- stage cost itself (not inside other rows' timed region) ----
  time("stage", staged = false) { freshStage() }

  // ---- source build + collect (what merge broadcasts) ----
  def s16Src = {
    val base = cust.where(col("c_custkey") % 100L === 7L)
      .withColumn("c_mktsegment", lit("MERGED"))
      .withColumn("c_acctbal", col("c_acctbal") + 10.0)
    base.unionByName(base.withColumn("c_custkey", col("c_custkey") + 10000000L))
  }
  time("src_collect", staged = false) { s16Src.queryExecution.toRdd.map(_.copy()).count() }

  // ---- per-statement machinery with ZERO rewrites ----
  import spark.implicits._
  val noopSrc = Seq((-1L, "x", -1L, 0.0, "NOOP"))
    .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    .select(cust.columns.map(col).toIndexedSeq: _*)
  time("noop_merge") {
    graft.sources.vortex.VortexMerge.merge(spark, dir, noopSrc, Seq("c_custkey"))
  }

  // ---- the three bench statements, SQL path ----
  s16Src.createOrReplaceTempView("probe_s16_src")
  time("s16_sql") {
    spark.sql(s"""MERGE INTO vtx.`$dir` t USING probe_s16_src s2
                  ON t.c_custkey = s2.c_custkey
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *""").collect()
  }
  time("s16_direct") {
    graft.sources.vortex.VortexMerge.merge(spark, dir, s16Src, Seq("c_custkey"))
  }

  val b16 = cust.where(col("c_custkey") % 50L === 3L)
    .withColumn("c_acctbal", col("c_acctbal") - 500.0)
    .withColumn("c_mktsegment", lit("S16B"))
  b16.unionByName(b16.withColumn("c_custkey", col("c_custkey") + 20000000L))
    .createOrReplaceTempView("probe_s16b_src")
  time("s16b_sql") {
    spark.sql(s"""MERGE INTO vtx.`$dir` t USING probe_s16b_src s2
                  ON t.c_custkey = s2.c_custkey
                  WHEN MATCHED AND s2.c_acctbal < 0 THEN DELETE
                  WHEN MATCHED THEN UPDATE
                    SET c_acctbal = s2.c_acctbal, c_mktsegment = s2.c_mktsegment
                  WHEN NOT MATCHED AND s2.c_acctbal >= 0 THEN INSERT *""").collect()
  }

  val c16 = cust.where(col("c_custkey") % 40L === 1L)
    .withColumn("c_acctbal", col("c_acctbal") + 77.0)
    .withColumn("c_mktsegment", lit("S16C"))
  c16.unionByName(c16.withColumn("c_custkey", col("c_custkey") + 30000000L))
    .createOrReplaceTempView("probe_s16c_src")
  time("s16c_sql") {
    spark.sql(s"""MERGE INTO vtx.`$dir` t USING probe_s16c_src s2
                  ON t.c_custkey = s2.c_custkey
                  WHEN MATCHED THEN UPDATE
                    SET c_acctbal = s2.c_acctbal, c_mktsegment = s2.c_mktsegment
                  WHEN NOT MATCHED THEN INSERT *
                  WHEN NOT MATCHED BY SOURCE AND t.c_acctbal < 0 THEN UPDATE
                    SET c_mktsegment = 'DORMANT'
                  WHEN NOT MATCHED BY SOURCE AND t.c_nationkey = 13 THEN DELETE""").collect()
  }

  // ---- read-back aggregate alone (post-mutation state is fine) ----
  time("readback", staged = false) {
    Bench.force(spark.read.format("vortex").load(dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("sum_key"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("sum_cents")))
  }

  // ---- the two-statement correlated rows' shape (orders, 1.5 M) ----
  val ord = Tables.t(spark, sfDir, "orders"); ord.count()
  val odir = s"${sys.props("java.io.tmpdir")}/graft_probe_merge_ord"
  def freshOrd(): Unit = {
    val p = new org.apache.hadoop.fs.Path(odir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    graft.sources.vortex.VortexBulkCopy.copy(ord, odir)
  }
  def timeOrd(name: String)(body: => Unit): Unit = {
    val times = (0 until 3).map { _ =>
      freshOrd()
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println(f"[merge] $name%-22s best ${times.min}%.3f s (${times.map(t => f"$t%.2f").mkString(",")})")
  }
  time("stage_orders", staged = false) { freshOrd() }
  Tables.t(spark, sfDir, "customer").createOrReplaceTempView("probe_cust")
  timeOrd("s15d_upd_corr") {
    spark.sql(s"""UPDATE vtx.`$odir` t SET o_orderpriority =
                    (SELECT c.c_mktsegment FROM probe_cust c
                     WHERE c.c_custkey = t.o_custkey AND c.c_acctbal < 0)
                  WHERE o_orderstatus = 'F'""").collect()
  }
  timeOrd("s15d_del_exists") {
    spark.sql(s"""DELETE FROM vtx.`$odir` t
                  WHERE EXISTS (SELECT 1 FROM probe_cust c
                                WHERE c.c_custkey = t.o_custkey
                                  AND c.c_mktsegment = 'MACHINERY')
                    AND o_totalprice > 100000.0""").collect()
  }
  spark.stop()
}
