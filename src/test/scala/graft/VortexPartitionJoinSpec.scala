package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned execution: a Hive-partitioned vortex dataset
  * reports KeyGroupedPartitioning(identity(partCol)), so joins between
  * co-partitioned tables and aggregations keyed on the partition
  * column run WITHOUT a shuffle exchange — at 100 TB the difference
  * between a metadata operation and re-moving the dataset.
  */
class VortexPartitionJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  private def finalPlan(df: DataFrame): String = {
    df.collect() // finalize the (possibly adaptive) plan
    df.queryExecution.executedPlan.toString
  }

  private def writePartitioned(dir: String, seed: Int): Unit = {
    spark.range(0, 2000).selectExpr(
        s"id + $seed AS v", "CAST(id % 8 AS BIGINT) AS k")
      .write.format("vortex").option("partitionBy", "k").mode("append").save(dir)
  }

  test("groupBy on the partition column aggregates without exchange") {
    val dir = Files.createTempDirectory("vortex_spj_").toString
    writePartitioned(dir, 0)
    val df = spark.read.format("vortex").load(dir)
      .groupBy("k").count()
    val plan = finalPlan(df)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(df.count() == 8)
  }

  test("co-partitioned join runs as storage-partitioned join (no shuffle)") {
    val d1 = Files.createTempDirectory("vortex_spj_a_").toString
    val d2 = Files.createTempDirectory("vortex_spj_b_").toString
    writePartitioned(d1, 0)
    writePartitioned(d2, 100)
    val a = spark.read.format("vortex").load(d1)
    val b = spark.read.format("vortex").load(d2)
    val joined = a.join(b, "k")
    val plan = finalPlan(joined)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // correctness: same result as the shuffle plan
    val expected = a.withColumnRenamed("v", "va").join(b.withColumnRenamed("v", "vb"), "k").count()
    assert(joined.count() == expected)
  }

  test("date partition values: ISO directory names, typed round trip, pruning") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("vortex_spj_date_").toString
    spark.range(0, 100).selectExpr(
        "id", "date_add(DATE '2024-01-01', CAST(id % 4 AS INT)) AS d")
      .write.format("vortex").option("partitionBy", "d").mode("append").save(dir)
    val names = new java.io.File(dir).listFiles.map(_.getName).filter(_.startsWith("d=")).sorted
    assert(names.toSeq == Seq("d=2024-01-01", "d=2024-01-02", "d=2024-01-03", "d=2024-01-04"))
    val back = spark.read.format("vortex").load(dir)
    assert(back.schema("d").dataType == org.apache.spark.sql.types.DateType)
    assert(back.count() == 100)
    assert(back.filter(col("d") === java.sql.Date.valueOf("2024-01-02")).count() == 25)
    assert(back.filter(col("d") > java.sql.Date.valueOf("2024-01-03")).count() == 25)
  }

  test("partitioned write clusters by partition value (no small-files blowup)") {
    val dir = Files.createTempDirectory("vortex_spj_clus_").toString
    // 4 upstream partitions × 8 keys: unclustered would write up to 32
    // files; the write's required clustered distribution bounds files
    // by distinct key count
    spark.range(0, 2000).repartition(4).selectExpr("id AS v", "CAST(id % 8 AS BIGINT) AS k")
      .write.format("vortex").option("partitionBy", "k").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.startsWith("k="))
      .flatMap(_.listFiles).count(_.getName.endsWith(".vortex"))
    assert(files <= 8, s"expected ≤8 clustered files, found $files")
    assert(spark.read.format("vortex").load(dir).count() == 2000)
  }

  test("non-partitioned scans still report unknown partitioning (no regression)") {
    val dir = Files.createTempDirectory("vortex_spj_flat_").toString
    spark.range(0, 1000).selectExpr("id AS v", "id % 8 AS k")
      .write.format("vortex").mode("append").save(dir)
    val df = spark.read.format("vortex").load(dir).groupBy("k").count()
    assert(df.count() == 8) // plan will shuffle; only correctness is asserted
  }
}
