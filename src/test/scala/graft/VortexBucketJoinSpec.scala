package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned execution over the HASH-BUCKETED layout: two
  * co-bucketed vortex datasets addressed through VortexCatalog report
  * KeyGroupedPartitioning(bucket(n, key)); the catalog's
  * FunctionCatalog resolves the bucket transform, so the equi-join on
  * the bucket key (a NON-partition column) elides both exchanges —
  * at 100 TB, a join that moves zero bytes of either table.
  */
class VortexBucketJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.catalog.vtx", "graft.sources.vortex.VortexCatalog")
    .getOrCreate()

  private def finalPlan(df: DataFrame): String = {
    df.collect() // finalize the (possibly adaptive) plan
    df.queryExecution.executedPlan.toString
  }

  private def writeBucketed(dir: String, rows: Long, n: Int, seed: Long): Unit =
    spark.range(0, rows).selectExpr("id AS k", s"id * 7 + $seed AS v")
      .write.format("vortex")
      .option("bucketBy", "k").option("buckets", n.toString)
      .mode("overwrite").save(dir)

  test("co-bucketed equi-join through the catalog runs without exchange") {
    val a = Files.createTempDirectory("vortex_spjb_a_").toString
    val b = Files.createTempDirectory("vortex_spjb_b_").toString
    writeBucketed(a, 3000, 8, seed = 0)
    writeBucketed(b, 3000, 8, seed = 1)
    val df = spark.sql(
      s"SELECT a.k, a.v, b.v AS w FROM vtx.`$a` a JOIN vtx.`$b` b ON a.k = b.k")
    assert(df.count() == 3000)
    val plan = finalPlan(df)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // values, not just shape
    val row = spark.sql(
      s"SELECT b.v AS w FROM vtx.`$a` a JOIN vtx.`$b` b ON a.k = b.k WHERE a.k = 17")
      .head
    assert(row.getLong(0) == 17 * 7 + 1)
  }

  test("aggregation keyed on the bucket column skips the exchange") {
    val a = Files.createTempDirectory("vortex_spjb_agg_").toString
    writeBucketed(a, 2000, 8, seed = 0)
    val df = spark.sql(s"SELECT k, sum(v) AS s FROM vtx.`$a` GROUP BY k")
    assert(df.count() == 2000)
    val plan = finalPlan(df)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val a = Files.createTempDirectory("vortex_spjb_m_a_").toString
    val b = Files.createTempDirectory("vortex_spjb_m_b_").toString
    writeBucketed(a, 1000, 8, seed = 0)
    writeBucketed(b, 1000, 4, seed = 5)
    val df = spark.sql(
      s"SELECT a.k FROM vtx.`$a` a JOIN vtx.`$b` b ON a.k = b.k")
    assert(df.count() == 1000)
  }

  test("tpch_q18_bucketed's fact aggregation runs exchange-free") {
    val sf = "/root/testdata/sf0.001"
    val li = graft.sources.vortex.BucketedTables.dir(spark, sf, "lineitem", "l_orderkey")
    val agg = spark.sql(
      s"""SELECT l_orderkey, SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS q
         |FROM vtx.`$li` GROUP BY l_orderkey
         |HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 20000""".stripMargin)
    assert(agg.count() > 0)
    val plan = finalPlan(agg)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // layout must not change the data: totals match the parquet source
    val bucketTotal = spark.sql(s"SELECT count(*) FROM vtx.`$li`").head.getLong(0)
    assert(bucketTotal == graft.Tables.t(spark, sf, "lineitem").count())
  }

  test("catalog CREATE TABLE with bucket transform lays out inserts bucketed") {
    val dir = Files.createTempDirectory("vortex_spjb_ct_").toString + "/t1"
    spark.sql(
      s"CREATE TABLE vtx.`$dir` (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO vtx.`$dir` SELECT id, id * 2 FROM range(0, 1000)")
    val root = new java.io.File(dir)
    assert(root.listFiles().count(f => f.isDirectory && f.getName.startsWith("__bucket=")) == 8)
    assert(spark.sql(s"SELECT count(*) FROM vtx.`$dir`").head.getLong(0) == 1000)
  }
}
